"""Deterministic synthetic sources derived from the driver's testdata
(FIXTURES.md): pages (Common-Crawl-style), polygon layers, raster tiles."""
