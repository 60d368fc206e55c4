from .runner import events_stream, run_to_batch  # noqa: F401
