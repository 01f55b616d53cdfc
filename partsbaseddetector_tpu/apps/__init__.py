"""Application surfaces: demo CLI, model transfer CLI, config-driven
pipelines, streaming node, serializable messages."""
