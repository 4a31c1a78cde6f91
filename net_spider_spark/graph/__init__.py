"""Graph analytics over snapshot graphs (degrees, roots, depths)."""
