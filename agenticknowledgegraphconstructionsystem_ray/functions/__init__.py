"""Pure, deterministic per-record kernels.

Everything in this subpackage is side-effect-free and independent of batch
boundaries, so the distributed pipeline and the sequential oracle share the
exact same code — the correctness contract (byte-identical text per url,
P/R >= 0.95 on triples) is met by construction and the tests verify that the
Ray execution layer preserves it.
"""
