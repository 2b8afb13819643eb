"""Inference / serving entry points (TPU-build extension).

The reference ships training and frozen-probe evals but NO inference path —
downstream consumption of a pretrained checkpoint means hand-writing a torch
script against its model classes. This package makes the trained encoder
servable through the same config-driven CLI as the training apps.
"""
