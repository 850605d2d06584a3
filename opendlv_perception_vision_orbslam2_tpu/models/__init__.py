"""SLAM pipeline stages (frame, extractor, tracking, mapping, loop closing)."""
