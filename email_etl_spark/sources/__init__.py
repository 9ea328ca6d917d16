"""Sources: raw email payloads → canonical EMAIL_SCHEMA DataFrames."""
