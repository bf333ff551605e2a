from .driver import run_stream, replay_batches, build_session  # noqa: F401
