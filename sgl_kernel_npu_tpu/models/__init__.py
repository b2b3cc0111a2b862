"""Model-family layers wiring the kernels together."""
