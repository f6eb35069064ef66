"""The reference's named analytics tasks, re-expressed as composable query
functions over DataFrames (Basic 1-8, Advanced 2-4)."""

from . import energy, football, images, plusminus, sales  # noqa: F401
