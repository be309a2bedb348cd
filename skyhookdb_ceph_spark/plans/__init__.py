"""Physical-plan introspection helpers (tests assert plan shapes)."""
