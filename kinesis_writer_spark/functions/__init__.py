"""Engine function library: cross-engine-reproducible hashing, text shingling,
and vector math used by the dedup / similarity / text operators.
"""
