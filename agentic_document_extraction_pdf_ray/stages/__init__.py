"""Ray Data batch transforms (stateless fns + actor-pool classes)."""
