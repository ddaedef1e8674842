"""ISP op implementations (pure JAX + Pallas)."""
