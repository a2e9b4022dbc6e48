from .catalog import ORACLES, QUERIES, flagship  # noqa: F401
