"""Pattern kernel library (TPU-native L1 tier)."""
