"""Operator library: relational helpers + LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""
