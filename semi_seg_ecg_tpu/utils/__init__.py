# Submodules are imported explicitly (no eager re-exports) to keep the
# utils <-> parallel dependency graph acyclic.
