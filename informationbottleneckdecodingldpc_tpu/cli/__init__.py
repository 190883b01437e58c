"""Command-line entry points: decoder construction and BER simulation."""
