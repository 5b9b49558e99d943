"""Interactive-proof protocol building blocks: multilinear extensions,
sumcheck, and GKR (the std/sumcheck + std/gkr + constraint/gkr.go analogs)."""
