"""End-to-end pipeline plans — the reference's CLI entry points
(ccdc/cli.py:31 changedetection, :57 classification) re-expressed as
single DataFrame plans Catalyst can see whole (SURVEY §3 lifecycle
note: the reference hides its RDD legs from the optimizer; we don't).
"""
