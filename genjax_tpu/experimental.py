"""Experimental staging ground (parity: reference
``/root/reference/src/genjax/experimental.py``, which is likewise empty of
stable API). Current residents may change without notice."""

from .kernels import column_hmc, pallas_hmc

__all__ = ["column_hmc", "pallas_hmc"]
