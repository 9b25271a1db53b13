from .step import build_step_fn, build_chunk_fn  # noqa: F401
