"""KG-construction pipeline stages (each a DataFrame transformation).

Stage order per SURVEY.md §7.2: ingest → parse → normalize → postings →
candidate edges → entity linking → canonicalization → graph materialize.
"""
