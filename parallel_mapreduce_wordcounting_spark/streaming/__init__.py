from .runner import documents_stream, events_stream, run_to_batch  # noqa: F401
from .stateful import user_state_stream  # noqa: F401
