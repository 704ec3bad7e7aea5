from .inspect import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    count_exchanges,
    physical_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "count_exchanges",
    "physical_plan",
]
