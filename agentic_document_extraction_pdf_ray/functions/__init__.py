"""Pure function library: the engine's scalar/vectorized "SQL function" layer."""
