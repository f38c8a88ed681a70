"""Per-family slices of the former sources_formats.py monolith.
Imported IN ORDER by the sources_formats facade — never directly by
load_all — so registry order is unchanged."""
