"""Command-line entry points: train / stabilize / bench / convert."""
