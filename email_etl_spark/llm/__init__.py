"""LLM-enrichment plumbing with deterministic stand-ins (SURVEY §2.K)."""
