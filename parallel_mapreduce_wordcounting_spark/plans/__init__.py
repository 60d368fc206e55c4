from .explain import explain_str, assert_pushed_down  # noqa: F401
