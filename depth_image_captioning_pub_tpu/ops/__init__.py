"""Functional TPU compute primitives: attention, LSTM cells, image ops, decode."""
