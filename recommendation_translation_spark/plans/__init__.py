from .checks import physical_plan, assert_pushed_filters, assert_broadcast_join, count_exchanges

__all__ = [
    "physical_plan",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "count_exchanges",
]
