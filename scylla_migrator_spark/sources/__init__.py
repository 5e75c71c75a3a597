"""Source readers. Each returns a plain DataFrame (lazy scan) so Catalyst can
push filters/projections into the scan."""
