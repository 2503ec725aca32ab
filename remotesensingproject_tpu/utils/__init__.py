"""I/O, visualization, profiling and checkpoint utilities."""
