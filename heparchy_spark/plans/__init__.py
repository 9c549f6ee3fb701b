"""Plan inspection helpers (scale-property assertions)."""
