"""Execution runtime: plan executors, device-mesh sharding, streaming
pipelines, manifest resume, cooperative cancellation."""
