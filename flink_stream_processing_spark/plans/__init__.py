from .inspect import (
    formatted_plan,
    has_broadcast_join,
    has_pushed_filter,
    has_take_ordered,
    whole_stage_codegen_spans,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "has_pushed_filter",
    "has_take_ordered",
    "whole_stage_codegen_spans",
]
