"""Large-scale data-pipeline operators (dedup, similarity, text, multimodal).

These extend the reference's surface (SURVEY.md §2.2 "extension
operators") with the operations a 100 TB training-data pipeline needs.
All are pure DataFrame compositions — no collect, no row-at-a-time
Python — so they scale with executors.
"""
