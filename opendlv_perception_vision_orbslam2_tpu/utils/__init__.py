"""Config, synthetic fixtures, trajectory metrics, misc host utilities."""
