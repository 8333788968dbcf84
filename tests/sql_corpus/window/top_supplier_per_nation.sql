-- groups: window; tables: supplier; ignoreOrder: false
SELECT s_nationkey, s_suppkey
FROM (SELECT s_nationkey, s_suppkey,
             row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rn
      FROM supplier)
WHERE rn = 1 AND s_nationkey < 8
ORDER BY s_nationkey
