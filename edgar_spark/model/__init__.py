"""Relational model: schemas, consolidation, export."""
