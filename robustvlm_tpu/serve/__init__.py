"""HTTP serving stack (reference llava/serve equivalent): controller with
worker registry/heartbeats/dispatch + model workers, stdlib-only."""
