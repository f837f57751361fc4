"""Relational + spatial operators, all expressed as DataFrame plans."""
