"""CLI drivers (the L6 surface of the reference: generate_data.py,
main_attack.py, certify.py)."""
