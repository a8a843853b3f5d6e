"""Analytical operators. Each module registers queries via registry.query."""
