"""Source-side connectors: KPL deaggregating reader (the consumer-side
counterpart of the sink) and helpers for replaying captured stream data
into DataFrames.
"""
