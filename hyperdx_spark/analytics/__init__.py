"""Client-side analytics operators (SURVEY §2.11): Drain pattern mining,
event deltas, heatmap bucketing."""
