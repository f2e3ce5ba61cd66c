"""Expression libraries: SQL fingerprinting, digests, vector math."""
