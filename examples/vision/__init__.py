"""Vision example components: datasets, models, engine, optimizers."""
