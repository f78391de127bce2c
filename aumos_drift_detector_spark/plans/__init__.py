"""End-to-end job plans (full validation pass, baseline capture)."""
