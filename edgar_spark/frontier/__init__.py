"""URL frontier: canonicalization, bloom/cuckoo URL-seen, robots gating,
politeness-bucketed wave scheduling, checkpoint/resume."""
