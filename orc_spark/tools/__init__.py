"""Command-line tools mirroring the reference's tools/ directory."""
