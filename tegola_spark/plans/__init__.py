"""Pipeline plan builders and the session factory."""
