"""Core services: units, calendar, data model, options, missing values, formatting."""
