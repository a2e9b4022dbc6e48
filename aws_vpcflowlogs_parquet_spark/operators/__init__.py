from .convert import convert_flowlogs, register_flowlog_table  # noqa: F401
