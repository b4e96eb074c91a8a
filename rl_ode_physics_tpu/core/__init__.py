"""Core world state, configuration, and the step() composition."""
