"""DataFrame→DataFrame operators that don't fit a single named query."""
