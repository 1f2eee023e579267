"""Index build pipeline: block builder, catalog layout, manifests."""
