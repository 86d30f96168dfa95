"""Environment-compat helpers (test/dev images missing optional deps)."""
