"""Bundled sample datasets (reference:
``/root/reference/py_stringsimjoin/datasets/base.py:10-27`` ships a person
CSV pair and a books CSV pair).  We synthesize equivalents deterministically
(FIXTURES.md F1/F2) instead of shipping data files."""

from __future__ import annotations

import numpy as np
import pandas as pd


def load_person_dataset():
    """7×9-row person tables A, B (same shape as the reference's
    person_table_A/B: ID, name, birth_year, hourly_wage, address, zipcode)."""
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


_TITLE_WORDS = ['the', 'of', 'and', 'data', 'systems', 'night', 'garden',
                'stone', 'river', 'shadow', 'light', 'story', 'history',
                'guide', 'art', 'science', 'world', 'life', 'secret', 'last',
                'first', 'complete', 'modern', 'ancient', 'lost', 'hidden',
                'silent', 'broken', 'golden', 'winter', 'summer']


def load_books_dataset(n_per_side: int = 1500, seed: int = 17):
    """Synthesized wider-record book tables (FIXTURES.md F2): ~n rows per
    side with title perturbations (token drop/swap/typo) linking the sides."""
    rng = np.random.default_rng(seed)

    def title():
        k = rng.integers(2, 7)
        return ' '.join(rng.choice(_TITLE_WORDS) for _ in range(k))

    def perturb(t):
        words = t.split()
        op = rng.random()
        if op < 0.33 and len(words) > 2:
            del words[rng.integers(0, len(words))]
        elif op < 0.66 and len(words) > 1:
            i = int(rng.integers(0, len(words) - 1))
            words[i], words[i + 1] = words[i + 1], words[i]
        else:
            i = int(rng.integers(0, len(words)))
            w = list(words[i])
            if w:
                w[rng.integers(0, len(w))] = 'x'
            words[i] = ''.join(w)
        return ' '.join(words)

    def make(side, titles):
        n = len(titles)
        return pd.DataFrame({
            'ID': [f'{side}{i}' for i in range(n)],
            'Title': titles,
            'Price': [f'{rng.integers(5, 80)}.{rng.integers(0, 99):02d}'
                      for _ in range(n)],
            'Author': [f'author_{rng.integers(0, 400)}' for _ in range(n)],
            'ISBN13': [f'978{rng.integers(0, 10**10):010d}' for _ in range(n)],
            'Publisher': [f'publisher_{rng.integers(0, 40)}' for _ in range(n)],
            'Pages': [str(rng.integers(80, 900)) for _ in range(n)],
        })

    base = [title() for _ in range(n_per_side)]
    titles_a = list(base)
    titles_b = [perturb(t) if rng.random() < 0.6 else title() for t in base]
    return make('a', titles_a), make('b', titles_b)
