"""CLI entry points (reference: lid/main.py, lid/main_cross.py)."""
