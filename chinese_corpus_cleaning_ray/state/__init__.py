"""Checkpoint manifests, partition assignment, resume logic."""
