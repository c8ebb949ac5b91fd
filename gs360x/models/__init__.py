"""Model families: the Flax segmentation network for subject masking."""
