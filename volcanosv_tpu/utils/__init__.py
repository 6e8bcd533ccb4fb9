from .logging import get_logger, stage_timer
from .intervals import interval_overlap, reciprocal_overlap, merge_intervals
