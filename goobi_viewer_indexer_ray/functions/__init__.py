"""Pure, deterministic functions defining the engine spec (no Ray imports).

Everything here must be bit-stable across workers and across runs: the
Ray stages and the pure-Python test oracles call the *same* functions,
which is how the byte-identical-extraction and rank-identical-scoring
invariants are enforced.
"""
