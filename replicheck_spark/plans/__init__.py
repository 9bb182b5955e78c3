"""Staged, checkpointed, resumable job plans."""
