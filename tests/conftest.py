import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope='session', autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext
    ray.init(address='local', num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level='ERROR')
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope='session')
def person_tables():
    """F1 fixture (FIXTURES.md): mirrors the reference's 7×9-row person test
    tables (tests/data/table_A.csv, table_B.csv) — near-duplicate names, one
    whitespace-only name, one NaN name per table."""
    A = pd.DataFrame({
        'A.ID': ['a1', 'a2', 'a3', 'a4', 'a5', 'a6', 'a7'],
        'A.name': ['Kevin Smith', 'Michael Franklin', 'William Bridge',
                   'Binto George', 'Alphonse Kemper', ' ', np.nan],
        'A.birth_year': [1989, 1988, 1986, 1987, 1984, 1990, 1990],
        'A.hourly_wage': [30.0, 27.5, 32.0, 32.5, 35.0, 40.0, 40.0],
        'A.address': ['607 From St, San Francisco',
                      '1652 Stockton St, San Francisco',
                      '3131 Webster St, San Francisco',
                      '423 Powell St, San Francisco',
                      '1702 Post Street, San Francisco',
                      '24th Street, San Francisco',
                      '24th Street, San Francisco'],
        'A.zipcode': ['94107', '94122', '94107', '94122', '94122', '94122',
                      '94122'],
    })
    B = pd.DataFrame({
        'B.ID': ['b1', 'b2', 'b3', 'b4', 'b5', 'b6', 'b7', 'b8'],
        'B.name': ['Mark Levene', 'Bill Bridge', 'Mike Franklin',
                   'Joseph Kuan', 'Alfons Kemper', 'Michael Brodie', ' ',
                   np.nan],
        'B.birth_year': [1987, 1986, 1988, 1982, 1984, 1987, 1986, 1986],
        'B.hourly_wage': [29.5, 32.0, 27.5, 26.0, 35.0, 32.5, 25.0, 25.0],
        'B.address': ['108 Clement St, San Francisco',
                      '3131 Webster St, San Francisco',
                      '1652 Stockton St, San Francisco',
                      '108 South Park, San Francisco',
                      '170 Post St, Apt 4,  San Francisco',
                      '133 Clement Street, San Francisco',
                      '20th Street, San Francisco',
                      '20th Street, San Francisco'],
        'B.zipcode': ['94107', '94107', '94122', '94122', '94122', '94107',
                      '94106', '94106'],
    })
    return A, B
