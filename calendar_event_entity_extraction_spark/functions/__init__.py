from .datetime_norm import date_norm_col, duration_norm_col, time_norm_col  # noqa: F401
