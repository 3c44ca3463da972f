"""Operator library — one module per SURVEY.md §2 family.

- relational: TPC-H-style Q1–Q7 + semi/anti/set-op generalizations (§2.2–§2.6)
- text: word count, bigrams, PMI, perfect-follower (§2.2, §2.4)
- index: inverted index + boolean retrieval (§2.7, §2.6)
- graph: multi-source personalized PageRank (§2.8)
- ml: SGD spam classifier train/apply/ensemble (§2.9)
- dedup / similarity / quality / multimodal: beyond-reference
  training-data-pipeline operators (SURVEY.md §7 Phase 7)
"""
