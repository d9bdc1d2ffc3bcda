"""Pure deterministic kernels shared verbatim by the oracle crawler and the
Ray Data stages.  No ray imports allowed here — determinism of these
functions is what makes "byte-identical extracted text per url" and
"identical seen set / crawl order" hold by construction (SURVEY.md §7.4).
"""
