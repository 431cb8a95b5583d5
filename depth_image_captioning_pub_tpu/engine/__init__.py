"""Functional train / evaluate engine built on pjit-compiled steps."""
