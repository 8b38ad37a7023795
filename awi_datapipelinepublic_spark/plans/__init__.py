"""Config-driven pipeline plans: spec parsing, analytical views, runner."""
