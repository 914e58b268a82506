"""End-to-end Ray Data pipeline compositions."""
