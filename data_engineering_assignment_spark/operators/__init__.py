"""Composable operators over DataFrames — the engine's reusable surface."""
