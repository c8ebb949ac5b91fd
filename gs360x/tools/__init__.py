"""CLI tools, flag-compatible with the reference's nine gs360_* scripts."""
