"""Operator library — each module re-expresses one slice of the
reference's operator inventory (SURVEY.md §2) in idiomatic DataFrame
form, plus the new large-scale training-data operators (dedup,
similarity, text, multimodal) the reference lacks."""
