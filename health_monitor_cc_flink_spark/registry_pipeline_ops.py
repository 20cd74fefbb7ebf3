"""Training-data-pipeline operators (dedup / similarity / text /
multimodal) registered as oracle-checked queries.  See operators/ for
the implementations; filled in incrementally."""
