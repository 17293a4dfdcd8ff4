"""Logical-plan compilation: view query → DataFrame program."""
