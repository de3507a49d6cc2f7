from .timing import Phase, annotate, profile_trace, timer
