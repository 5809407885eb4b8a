from .explain import explain_str, assert_broadcast_join, assert_pushed_filters  # noqa: F401
