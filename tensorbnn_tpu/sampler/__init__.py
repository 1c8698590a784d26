"""sampler subpackage."""
