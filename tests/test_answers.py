"""Golden-answer tests (self-skipping without --answer_dir)."""

import pytest

from .answers import model_answer_testing, particle_answer_testing


def test_model_answers(canonical_model, answer_dir, answer_store):
    model_answer_testing(canonical_model, "canonical_model", answer_store,
                         answer_dir)


def test_particle_answers(canonical_model, answer_dir, answer_store):
    parts = canonical_model.generate_dm_particles(10_000, r_max=5000.0,
                                                  prng=25)
    parts = parts + canonical_model.generate_gas_particles(
        5_000, r_max=5000.0, prng=26)
    particle_answer_testing(parts, "canonical", answer_store, answer_dir)
