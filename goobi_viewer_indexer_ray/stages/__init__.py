"""Ray Data stages: batch transforms (stateless fns) and actor-pool classes."""
