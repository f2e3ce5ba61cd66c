"""Sources: the multi-line MySQL slow-log text source + parser."""
