"""Shared CLI helpers for the sample apps."""
from __future__ import annotations

import argparse


def parse_dim(s: str):
    """'WxH' → (w, h) with a friendly argparse error (the reference samples
    accept --dim=WxH, e.g. optixPathTracer.cpp:938-975)."""
    try:
        w_str, h_str = s.lower().split("x")
        w, h = int(w_str), int(h_str)
        if w <= 0 or h <= 0:
            raise ValueError
        return w, h
    except (ValueError, AttributeError):
        raise SystemExit(
            f"error: --dim expects WIDTHxHEIGHT (e.g. 768x768), got {s!r}")
