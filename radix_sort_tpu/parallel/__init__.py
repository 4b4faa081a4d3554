"""Multi-chip / multi-host distribution layer (mesh, shard_map, radix
shuffle) — the capability the single-device reference lacked entirely
(SURVEY.md §2, parallelism inventory)."""
