"""Readers / writers: pages ingest, stage snapshot store."""
