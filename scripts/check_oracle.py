"""Alias for scripts/parity.py (name used by the verify skill)."""
from parity import main

if __name__ == "__main__":
    main()
