"""Production serving: precompiled reconstruction engines + a local HTTP
front-end.

The reference has no deployment story at all — every reconstruction is a
one-shot research script (SURVEY.md §2.6). This package is the TPU-native
serving path: a `ReconstructionEngine` compiles the full ALD+proximal chain
ONCE at a fixed geometry (params, operators, and measurement all enter the
program as arguments, so every subsequent request — new scan, new mask, new
coil maps — reuses the same executable with zero retraces), and
`serving.server` exposes it over a local HTTP endpoint
(`scripts/serve_recon.py`).
"""
from .engine import EngineSpec, ReconResult, ReconstructionEngine
from .cine import CineEngineSpec, CineReconstructionEngine

__all__ = ["EngineSpec", "ReconResult", "ReconstructionEngine",
           "CineEngineSpec", "CineReconstructionEngine"]
