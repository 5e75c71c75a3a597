"""Top-level plans: migrate (dispatch) and validate (join-diff engine)."""
