"""Offline tools (L-aux): checkpoint averaging, corpus shuffling, analysis
scorers. Counterparts of reference scripts/ (SURVEY §2.8)."""
